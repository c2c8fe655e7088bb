#!/usr/bin/env python3
"""Golden-output end-to-end test harness.

Mirrors the reference harness (/root/reference/tools/test-e2e.py:14-105): run
the CLI on every image in a test-data directory, strip whitespace, diff
against ``<name>.expected.txt``, and print per-image wall time. ``--update``
rewrites the baselines.

Two tiers:

  * default — the CLI runs with ``--fake-models`` (deterministic test
    models, mirroring the reference's fake-model engine tests) against the
    repo's own pinned goldens, so the tier is hermetic: no trained weights
    needed, and it exercises the full binary surface — image decode,
    preprocessing, detection, layout, recognition, CTC, output formatting.
  * ``--real`` — the SHIPPED trained weights run against the REFERENCE
    repo's golden images (/root/reference/ocrs-cli/test-data) and must
    reach a word-level F1 threshold (default 0.8, tolerance-based rather
    than byte-exact so incidental single-char differences don't flake);
    an accuracy regression in the shipped weights fails this tier.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _cpu_env() -> dict:
    """Hermetic CPU environment for the CLI subprocess: golden outputs are
    pinned on the deterministic CPU backend, and the TPU relay shim is
    disabled so a wedged relay can't hang interpreter startup."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def strip_whitespace(text: str) -> str:
    return "".join(text.split())


def run_ocr(image: Path, extra_args: list[str]) -> str:
    result = subprocess.run(
        [sys.executable, "-m", "ocrs_tpu.cli", str(image), "--fake-models", *extra_args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,
        env=_cpu_env(),
    )
    if result.returncode != 0:
        raise RuntimeError(f"CLI failed on {image.name}:\n{result.stderr}")
    return result.stdout


def run_real_tier(min_f1: float) -> int:
    """Trained-weight golden tier: shipped weights vs the reference's own
    golden images, scored at the word level (tools/eval_reference.py)."""
    import json

    ref_data = Path("/root/reference/ocrs-cli/test-data")
    if not ref_data.exists():
        print("reference test-data not available; skipping real tier")
        return 0
    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "eval_reference.py"),
            "--min-f1",
            str(min_f1),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    out = result.stdout.strip().splitlines()
    scores = json.loads(out[-1]) if out else {}
    for name, s in scores.items():
        exact = (
            "EXACT"
            if s.get("exact_match")
            else f"{s.get('char_diff', '?')} char diff"
        )
        print(
            f"{name}: P {s['precision']:.3f} R {s['recall']:.3f} F1 {s['f1']:.3f}"
            f" (threshold {min_f1}; vs reference exact-match standard: {exact})"
        )
    if result.returncode != 0:
        print(f"real-weights golden tier FAILED (F1 < {min_f1})", file=sys.stderr)
        print(result.stderr[-2000:], file=sys.stderr)
        return 1
    print("real-weights golden tier passed")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "test_data", nargs="?", default=str(REPO / "test-data"), help="Directory of test images"
    )
    parser.add_argument("--update", action="store_true", help="Rewrite expected outputs")
    parser.add_argument(
        "--real",
        action="store_true",
        help="also run the shipped trained weights against the reference goldens",
    )
    parser.add_argument("--min-f1", type=float, default=0.8)
    args = parser.parse_args()

    test_dir = Path(args.test_data)
    images = sorted(test_dir.glob("*.png"))
    if not images:
        print(f"no test images in {test_dir}", file=sys.stderr)
        return 1

    failures = 0
    for image in images:
        expected_path = image.with_suffix("").with_suffix(".expected.txt")
        start = time.time()
        output = run_ocr(image, [])
        elapsed = time.time() - start
        print(f"{image.name}: {elapsed:.2f}s")

        if args.update:
            expected_path.write_text(output)
            print(f"  updated {expected_path.name}")
            continue

        if not expected_path.exists():
            print(f"  MISSING baseline {expected_path.name}", file=sys.stderr)
            failures += 1
            continue

        expected = expected_path.read_text()
        if strip_whitespace(output) != strip_whitespace(expected):
            print(f"  MISMATCH vs {expected_path.name}", file=sys.stderr)
            print(f"  expected: {expected!r}", file=sys.stderr)
            print(f"  got:      {output!r}", file=sys.stderr)
            failures += 1
        else:
            print("  OK")

    if failures:
        print(f"{failures} failure(s)", file=sys.stderr)
        return 1
    print("all golden tests passed")
    if args.real:
        return run_real_tier(args.min_f1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
