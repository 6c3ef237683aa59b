#!/usr/bin/env python
"""Developer checks: import, compile-sanity, and the test suite.

Analog of the reference's scripts/run_dev_checks.py (isort/black/pytest
runner).  Usage: python scripts/run_dev_checks.py [--fast]
"""
import argparse
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--fast", action="store_true", help="skip the slow test files"
    )
    args = parser.parse_args()

    rc = run([sys.executable, "-c", "import nerfacc_tpu; print(nerfacc_tpu.__version__)"])
    if rc:
        return rc

    tests = ["tests/test_pack.py", "tests/test_scan.py", "tests/test_rendering.py"]
    if not args.fast:
        tests = ["tests/"]
    return run([sys.executable, "-m", "pytest", "-q", *tests])


if __name__ == "__main__":
    sys.exit(main())
