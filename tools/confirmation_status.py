"""Confirmation ledger: which registry queries have hard driver evidence.

Diffs the live registry against every committed CORRECTNESS_r*.json and
prints, per query, the rounds it was sampled in and whether it has ever
been fully green (rows + schema + hash, no error). Summarizes the
never-sampled and sampled-but-never-green sets so each round's
registration order (mock_map_reduce_spark/registry.py PRIORITY) can be
aimed at the remaining confirmation debt.

Usage:
    python tools/confirmation_status.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def collect() -> dict:
    from mock_map_reduce_spark import registry

    registry.load_all()
    names = list(registry.QUERIES)

    sampled: dict[str, list[int]] = {n: [] for n in names}
    green: dict[str, list[int]] = {n: [] for n in names}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        data = json.load(open(path))
        for name, row in data.items():
            if name not in sampled:  # renamed/retired queries
                sampled[name] = []
                green[name] = []
            sampled[name].append(rnd)
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                green[name].append(rnd)

    never_sampled = [n for n in names if not sampled[n]]
    never_green = [n for n in names if sampled[n] and not green[n]]
    confirmed = [n for n in names if green[n]]
    rows_only = sorted(set(names) - set(registry.ORACLES))
    return {
        "total_registered": len(names),
        "confirmed_green": len(confirmed),
        "never_sampled": never_sampled,
        "sampled_never_green": never_green,
        "no_oracle_rows_only": rows_only,
        "first_50_unconfirmed": [n for n in names[:50] if n not in confirmed],
        "per_query": {
            n: {"sampled_rounds": sampled[n], "green_rounds": green[n]}
            for n in names
        },
    }


def main() -> None:
    st = collect()
    if "--json" in sys.argv:
        print(json.dumps(st, indent=1))
        return
    if "--suggest" in sys.argv:
        # Since round 7 the registry auto-rotates from the ledger
        # (registry.compute_rotation); this prints the same ordering
        # for inspection.
        from mock_map_reduce_spark import registry

        for n in registry.compute_rotation(list(registry.QUERIES)):
            print(n)
        return
    print(f"registered queries:        {st['total_registered']}")
    print(f"driver-confirmed green:    {st['confirmed_green']}")
    print(f"never driver-sampled:      {len(st['never_sampled'])}")
    for n in st["never_sampled"]:
        print(f"    {n}")
    print(f"sampled but never green:   {len(st['sampled_never_green'])}")
    for n in st["sampled_never_green"]:
        print(f"    {n}")
    print(f"rows-only (no oracle):     {st['no_oracle_rows_only']}")
    print(
        f"next-sample prefix aimed at confirmation debt: "
        f"{len(st['first_50_unconfirmed'])}/50 unconfirmed names in positions 0-49"
    )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
