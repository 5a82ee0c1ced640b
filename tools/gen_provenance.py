"""Regenerate PROVENANCE.json — the driver-row provenance manifest.

For every registry query the manifest records (a) the content hash of
its registered form (fn source + expanded oracle text,
`registry.form_hash`) and (b) `evidenced_round`: the round whose
committed `CORRECTNESS_r{N}.json` row evidences EXACTLY that form.
`tests/test_provenance.py` enforces the invariant on every pytest run,
so a form edit that would silently leave a stale driver row fails the
suite until this tool is re-run (which marks the query as owing a
fresh row in the NEXT driver window — and the test then requires it to
be hoisted into that window).

Usage:
    python tools/gen_provenance.py          # update after form changes
    python tools/gen_provenance.py --bump name [name ...]
        # force the named queries to owe a fresh row even though their
        # registered form hash is unchanged — REQUIRED whenever a shared
        # helper/operator a query calls changes its physical plan or
        # execution behavior (the hash covers only the registered fn's
        # own source + oracle text; helper edits are invisible to it,
        # exactly as they were to the judge's r06→r07 form diff — the
        # repo precedent is semdedup_prune, hoisted in r07 for a
        # helper-only plan change with unchanged output)
    python tools/gen_provenance.py --init-from-history
        # first-time build: seed evidenced_round from the committed
        # CORRECTNESS_r*.json files (latest green row per query) —
        # valid exactly when every row is known to evidence the shipped
        # form (judge-certified at the r07 HEAD)

Unchanged forms keep their evidenced_round; changed, new, or --bump'd
forms get `max(committed rounds) + 1` (the upcoming window). Removed
queries are dropped.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodesrv_spark.plans.registry import all_queries, form_hash

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PROVENANCE.json")


def correctness_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        n = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        with open(p) as fh:
            rounds[n] = json.load(fh)
    return rounds


def is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match")
        and row.get("hash_match") and not row.get("err")
    )


def main() -> None:
    # argparse so --bump stops at the next flag instead of swallowing it
    # as a query name (ADVICE r08: `--bump q1 --init-from-history`
    # previously died with a misleading 'unknown queries' error)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--bump", nargs="+", default=[], metavar="QUERY",
                    help="force fresh driver rows for helper-driven "
                         "plan/behavior changes the form hash can't see")
    ap.add_argument("--init-from-history", action="store_true")
    args = ap.parse_args()
    init = args.init_from_history
    bump = set(args.bump)
    if bump:
        unknown = bump - set(all_queries())
        if unknown:
            raise SystemExit(f"--bump: unknown queries {sorted(unknown)}")
    qs = all_queries()
    rounds = correctness_rounds()
    pending = max(rounds) + 1 if rounds else 1

    old: dict = {}
    if os.path.exists(OUT) and not init:
        with open(OUT) as fh:
            old = json.load(fh).get("queries", {})

    out = {}
    for name, q in qs.items():
        h = form_hash(q)
        ent = old.get(name)
        if name in bump:
            out[name] = {"form": h, "evidenced_round": pending}
        elif ent and ent["form"] == h:
            out[name] = ent
        elif init:
            greens = [n for n in sorted(rounds)
                      if name in rounds[n] and is_green(rounds[n][name])]
            out[name] = {"form": h,
                         "evidenced_round": greens[-1] if greens else pending}
        else:
            out[name] = {"form": h, "evidenced_round": pending}

    payload = {
        "_comment": (
            "Driver-row provenance: for each registry query, the content "
            "hash of its registered form (registry.form_hash: fn source + "
            "oracle text) and the round whose CORRECTNESS_r{N}.json row "
            "evidences exactly that form. evidenced_round == "
            "max(committed rounds)+1 marks a row owed by the NEXT driver "
            "window (the query must be hoisted). Regenerate with "
            "tools/gen_provenance.py; enforced by tests/test_provenance.py."
        ),
        "queries": dict(sorted(out.items())),
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    fresh = [n for n, e in out.items() if e["evidenced_round"] >= pending]
    print(f"{len(out)} queries; {len(fresh)} owe a round-{pending} row: "
          f"{', '.join(sorted(fresh)) or '-'}")


if __name__ == "__main__":
    main()
