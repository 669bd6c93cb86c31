"""Compare two bench artifacts: per-query deltas, regressions, and
coverage changes.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_sec]

Accepts either a raw ``bench.py`` payload (``{"queries": {...}}``)
or a driver-recorded ``BENCH_r{N}.json`` that wraps it under
``parsed``. Prints a human summary plus one machine-readable JSON
line (shared-total ratio, top regressions/improvements, added and
removed query names) — the same comparison the round judge performs,
runnable locally before a round closes.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    queries = doc.get("queries")
    if not isinstance(queries, dict):
        raise SystemExit(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in queries.items()}


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    old = load(old_path)
    new = load(new_path)
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    old_total = sum(old[q] for q in shared)
    new_total = sum(new[q] for q in shared)
    deltas = sorted(
        ((new[q] - old[q], q) for q in shared), key=lambda x: -x[0]
    )
    regressions = [(q, old[q], new[q]) for d, q in deltas if d > threshold]
    improvements = [
        (q, old[q], new[q]) for d, q in reversed(deltas) if d < -threshold
    ]

    print(f"shared {len(shared)} queries: {old_total:.1f}s -> {new_total:.1f}s "
          f"({new_total / old_total:.2f}x)" if old_total else "no shared queries")
    if regressions:
        print(f"\nregressions (> +{threshold}s):")
        for q, a, b in regressions:
            print(f"  {a:7.2f} -> {b:7.2f}  {q}")
    if improvements:
        print(f"\nimprovements (> -{threshold}s):")
        for q, a, b in improvements:
            print(f"  {a:7.2f} -> {b:7.2f}  {q}")
    if added:
        print(f"\nadded ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"\nremoved ({len(removed)}): {', '.join(removed)}")
    print()
    print(
        json.dumps(
            {
                "shared": len(shared),
                "old_total_sec": round(old_total, 2),
                "new_total_sec": round(new_total, 2),
                "ratio": round(new_total / old_total, 3) if old_total else None,
                "n_regressions": len(regressions),
                "n_added": len(added),
                "n_removed": len(removed),
            }
        )
    )


if __name__ == "__main__":
    main()
