"""Regenerate VERIFIED.json — the driver-cap rotation manifest.

The driver's CORRECTNESS check caps at ~50 queries per round, so a key's
green row keeps certifying the repo only while the module that defines it is
byte-unchanged.  This script folds one round's CORRECTNESS_r0N.json into
VERIFIED.json: every key with a fully-green row gets
``{round: N, module: <relpath>, module_md5: <md5 of the module AT the
verified commit>, key_sha: <per-key fingerprint>}``.
__spark_entry__.priority_order() then puts any key whose fingerprint has
since drifted (or that was never verified) at the front of the
registration order, so the next driver run re-verifies it first.

``key_sha`` (round-5 ADVICE fix) is registry.key_fingerprint — the query
function's transitive same-module source closure plus its oracle SQL — so
staleness is per-key, not per-module.  It is computed from the LIVE import
and therefore only recorded when the working-tree module bytes still equal
the blob at COMMIT; otherwise the entry stays module-md5-tracked (which is
conservative: it reads as stale until re-verified).

Usage:
    python scripts/update_verified.py ROUND [COMMIT]
    python scripts/update_verified.py --upgrade

--upgrade backfills ``key_sha`` for existing entries whose module bytes
still match their recorded module_md5 (round unchanged).

COMMIT defaults to HEAD and must be the tree the driver actually verified
(the end-of-round state).  Keys green only in OLDER rounds keep their
existing entries untouched.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def green(row: dict) -> bool:
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        # rows-only checks (no oracle) record no hash_match key
        and row.get("hash_match", True) is True
    )


def upgrade() -> None:
    """Backfill key_sha for entries whose module bytes are unchanged since
    their recorded green row (live fingerprint == verified fingerprint)."""
    import __spark_entry__ as entry
    from pdf_extractor_spark.operators import registry

    entry.queries()
    mf_path = REPO / "VERIFIED.json"
    manifest = json.loads(mf_path.read_text())
    n_upd = 0
    for key, ent in manifest.items():
        if "key_sha" in ent or key not in registry.QUERIES:
            continue
        mod = REPO / ent["module"]
        if hashlib.md5(mod.read_bytes()).hexdigest() != ent["module_md5"]:
            print(f"  keep md5-tracked (module drifted): {key}")
            continue
        ent["key_sha"] = registry.key_fingerprint(key)
        n_upd += 1
    mf_path.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"VERIFIED.json: key_sha backfilled for {n_upd} entries")


def main() -> None:
    if sys.argv[1] == "--upgrade":
        upgrade()
        return
    rnd = int(sys.argv[1])
    commit = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    rows = json.loads((REPO / f"CORRECTNESS_r{rnd:02d}.json").read_text())

    import __spark_entry__ as entry  # populates the registry
    from pdf_extractor_spark.operators import registry

    queries = entry.queries()
    mf_path = REPO / "VERIFIED.json"
    manifest = json.loads(mf_path.read_text()) if mf_path.exists() else {}

    md5_at: dict[str, str] = {}

    def module_md5(relpath: str) -> str:
        if relpath not in md5_at:
            blob = subprocess.run(
                ["git", "show", f"{commit}:{relpath}"],
                capture_output=True, cwd=REPO, check=True,
            ).stdout
            md5_at[relpath] = hashlib.md5(blob).hexdigest()
        return md5_at[relpath]

    n_upd = 0
    for key, row in rows.items():
        if not green(row):
            print(f"  skip (not green): {key}")
            continue
        fn = queries.get(key)
        if fn is None:
            print(f"  skip (no longer registered): {key}")
            continue
        mod_file = Path(sys.modules[fn.__module__].__file__).resolve()
        rel = str(mod_file.relative_to(REPO))
        ent = {"round": rnd, "module": rel, "module_md5": module_md5(rel)}
        # key_sha comes from the live import, so only record it when the
        # working tree still matches the verified blob.
        if hashlib.md5(mod_file.read_bytes()).hexdigest() == module_md5(rel):
            ent["key_sha"] = registry.key_fingerprint(key)
        else:
            print(f"  md5-only (working tree drifted from {commit}): {key}")
        manifest[key] = ent
        n_upd += 1

    mf_path.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"VERIFIED.json: {n_upd} keys updated to round {rnd} "
          f"({len(manifest)} total entries)")


if __name__ == "__main__":
    main()
