"""Committed-compile-cache hygiene: manifest, staleness check, GC.

The repo commits XLA compile-cache entries (.cache/jax_tests for the CPU
test/dryrun programs, .cache/jax_tpu for the bench train-step executables)
so fresh hosts skip minutes of XLA compiles. Entries are content-keyed on
(program, jax/jaxlib version, device kind): a toolchain bump silently turns
every committed entry into dead weight — they never error, they just miss
(round-3/4 advisor findings). This tool makes that rot visible and
removable:

  --record       snapshot the CURRENT entries + toolchain versions into
                 MANIFEST.json (run after a full warm workload: make test,
                 make heavy, the multichip dryrun, bench.py)
  (default)      report staleness (manifest toolchain != current) and
                 orphans (files not in the manifest); exit 1 if any
  --apply        delete the orphans the report finds
  --live-dir D   definitive orphan set: compare against a FRESH cache dir
                 that a full workload just repopulated from scratch --
                 entries absent there (by filename) are dead keys

Size budget (documented in docs/DESIGN.md): keep each committed cache dir
under its manifest's recorded total +10%; when adding entries for a new
program version, delete the superseded ones in the same commit.

Usage:
  python tools/cache_gc.py [--cache-dir .cache/jax_tests] [--record]
                           [--apply] [--live-dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

MANIFEST = "MANIFEST.json"


def toolchain_versions() -> dict:
    import jax
    import jaxlib

    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__}


def entries_of(cache_dir: str) -> dict[str, int]:
    out = {}
    for name in sorted(os.listdir(cache_dir)):
        if name == MANIFEST or name.startswith("."):
            continue
        p = os.path.join(cache_dir, name)
        if os.path.isfile(p):
            out[name] = os.path.getsize(p)
    return out


def record(cache_dir: str) -> dict:
    manifest = {
        "toolchain": toolchain_versions(),
        "entries": entries_of(cache_dir),
    }
    manifest["total_bytes"] = sum(manifest["entries"].values())
    with open(os.path.join(cache_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    print(
        f"{cache_dir}: recorded {len(manifest['entries'])} entries, "
        f"{manifest['total_bytes'] / 1e6:.1f} MB, "
        f"toolchain {manifest['toolchain']}"
    )
    return manifest


def load_manifest(cache_dir: str) -> dict | None:
    p = os.path.join(cache_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def gc(cache_dir: str, *, apply: bool, live_dir: str | None) -> int:
    have = entries_of(cache_dir)
    problems = 0

    manifest = load_manifest(cache_dir)
    if manifest is None:
        print(f"{cache_dir}: no {MANIFEST} — run --record after a full "
              f"warm workload", file=sys.stderr)
        problems += 1
        live = None
    else:
        current = toolchain_versions()
        if manifest["toolchain"] != current:
            print(
                f"{cache_dir}: STALE — recorded under "
                f"{manifest['toolchain']}, running {current}; every "
                f"committed entry will miss. Repopulate with a fresh "
                f"workload, then --record.",
                file=sys.stderr,
            )
            problems += 1
        live = set(manifest["entries"])

    if live_dir is not None:
        live = set(entries_of(live_dir))
        print(f"live set: {len(live)} entries from {live_dir}")

    if live is None:
        return problems

    orphans = sorted(set(have) - live)
    orphan_bytes = sum(have[n] for n in orphans)
    if orphans:
        problems += 1
        print(f"{cache_dir}: {len(orphans)} orphaned entries "
              f"({orphan_bytes / 1e6:.1f} MB) not in the "
              f"{'live dir' if live_dir else 'manifest'}")
        for n in orphans:
            if apply:
                os.remove(os.path.join(cache_dir, n))
                print(f"  removed {n} ({have[n] / 1e3:.0f} kB)")
            else:
                print(f"  orphan {n} ({have[n] / 1e3:.0f} kB)")
        if not apply:
            print("(re-run with --apply to delete)")
        elif live_dir:
            print("entries deleted; re-run --record to update the manifest")
    else:
        print(f"{cache_dir}: clean — {len(have)} entries, "
              f"{sum(have.values()) / 1e6:.1f} MB, no orphans")
    return problems


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", action="append", default=None,
                    help="cache dir(s); default: .cache/jax_tests and "
                         ".cache/jax_tpu under the repo root")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--live-dir", default=None)
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = args.cache_dir or [
        os.path.join(repo, ".cache", "jax_tests"),
        os.path.join(repo, ".cache", "jax_tpu"),
    ]
    rc = 0
    for d in dirs:
        if not os.path.isdir(d):
            print(f"{d}: missing, skipped")
            continue
        if args.record:
            record(d)
        else:
            rc += gc(d, apply=args.apply, live_dir=args.live_dir)
    return 1 if rc else 0


if __name__ == "__main__":
    sys.exit(main())
