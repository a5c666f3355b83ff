#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (round-over-round deltas).

Usage: python3 tools/bench_compare.py OLD.json NEW.json [topN]
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    keys = sorted(set(old) | set(new),
                  key=lambda k: -(new.get(k, 0) - old.get(k, 0)))
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for k in keys[:top]:
        o, n = old.get(k), new.get(k)
        delta = (n - o) if o is not None and n is not None else float("nan")
        print(f"{k:34s} {o if o is not None else float('nan'):8.2f} "
              f"{n if n is not None else float('nan'):8.2f} {delta:+8.2f}")
    print(f"\ntotal: {sum(old.values()):.1f}s -> {sum(new.values()):.1f}s "
          f"({len(old)} -> {len(new)} queries)")


if __name__ == "__main__":
    main()
