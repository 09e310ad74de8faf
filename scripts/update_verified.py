"""Regenerate VERIFIED.json — the driver-cap rotation manifest.

The driver's CORRECTNESS check caps at ~50 queries per round, so a key's
green row keeps certifying the repo only while the module that defines it is
byte-unchanged.  This script folds one round's CORRECTNESS_r0N.json into
VERIFIED.json: every key with a fully-green row gets
``{round: N, module: <relpath>, module_md5: <md5 of the module AT the
verified commit>}``.  __spark_entry__.priority_order() then puts any key
whose module has since drifted (or that was never verified) at the front of
the registration order, so the next driver run re-verifies it first.

Usage:
    python scripts/update_verified.py ROUND [COMMIT]

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


def main() -> None:
    rnd = int(sys.argv[1])
    commit = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    rows = json.loads((REPO / f"CORRECTNESS_r{rnd:02d}.json").read_text())

    import __spark_entry__ as entry  # populates the registry

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
        manifest[key] = {
            "round": rnd, "module": rel, "module_md5": module_md5(rel),
        }
        n_upd += 1

    mf_path.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"VERIFIED.json: {n_upd} keys updated to round {rnd} "
          f"({len(manifest)} total entries)")


if __name__ == "__main__":
    main()
