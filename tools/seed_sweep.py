"""Measure a statistical test's seed-sweep failure rate.

The ``rng_key`` fixture (tests/conftest.py) rotates its seed daily, so any
statistical tolerance is implicitly a bet on the seed distribution. This
tool makes the bet explicit: run a test id under N distinct seeds via the
``BJT_TEST_SEED`` override and report the failure fraction — any test with
>1% daily red risk needs a wider (sweep-justified) tolerance, not a retry.

Usage::

    python tools/seed_sweep.py tests/multidevice/test_sharded_smc.py::test_sharded_waste_free_tempered [-n 24]

Runs on the CPU backend with the 8-device virtual mesh (same config the
test tiers use).
"""
import argparse
import os
import subprocess
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("test_id", help="pytest node id to sweep")
    ap.add_argument("-n", "--num-seeds", type=int, default=24)
    ap.add_argument("--start", type=int, default=20260101, help="first seed")
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

    failures = []
    for i in range(args.num_seeds):
        seed = args.start + i
        env["BJT_TEST_SEED"] = str(seed)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", args.test_id, "-q", "-x",
             "--no-header", "-p", "no:cacheprovider"],
            env=env,
            capture_output=True,
            text=True,
        )
        status = "PASS" if proc.returncode == 0 else "FAIL"
        print(f"seed {seed}: {status}", flush=True)
        if proc.returncode != 0:
            failures.append(seed)
            tail = "\n".join(proc.stdout.splitlines()[-12:])
            print(tail, flush=True)
    rate = len(failures) / args.num_seeds
    print(
        f"\n{len(failures)}/{args.num_seeds} failed ({100 * rate:.1f}%)"
        + (f" — seeds {failures}" if failures else "")
    )
    return 1 if rate > 0.01 else 0


if __name__ == "__main__":
    sys.exit(main())
