"""Assemble SWEEP_r{N}_sf01.json from the raw sf0.1 sweep (which excludes
``dedup_minhash_lsh`` — its full oracle is pair-quadratic on the sf0.1
planted near-dup corpus, measured 25.4M banded candidate pairs in r14)
plus the capped-twin result for that query (the standing VARIANTS8X
policy for the 5 pair-enumeration queries).

Usage:
    python scripts/merge_sweep_sf01.py RAW.json CAPPED.json OUT.json
where CAPPED.json is an oracle_check --variants run at sf0.1 restricted
to dedup_minhash_lsh__capped.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    raw_path, capped_path, out_path = sys.argv[1:4]
    raw = json.load(open(raw_path))
    capped = json.load(open(capped_path))
    tw = capped["queries"]["dedup_minhash_lsh__capped"]
    assert tw["status"] == "ok", tw
    raw["queries"]["dedup_minhash_lsh"] = {
        "status": "ok_capped_twin",
        "secs": tw["secs"],
        "rows": tw["rows"],
        "note": (
            "registry form verified via its capped sweep twin "
            "(sweep_variants, the standing policy for the 5 pair queries "
            "on pair-quadratic corpora): at sf0.1 the planted near-dup "
            "families make the banded candidate set 25.4M pairs (measured "
            "r14; the token-intersection join atop ran >45 min in DuckDB). "
            "Full registry-form oracle remains green at sf0.01 "
            "(SWEEP_r15.json) and in VARIANTS8X capped form at 8x."
        ),
    }
    raw["n_checked"] = len(raw["queries"])
    raw["n_ok"] = sum(
        1
        for v in raw["queries"].values()
        if v["status"] in ("ok", "ok_capped_twin")
    )
    raw["n_fail"] = sum(
        1 for v in raw["queries"].values() if v["status"] == "fail"
    )
    with open(out_path, "w") as f:
        json.dump(raw, f, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {raw['n_checked']} checked, {raw['n_ok']} ok, "
        f"{raw['n_fail']} fail"
    )


if __name__ == "__main__":
    main()
