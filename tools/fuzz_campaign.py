"""Extended byte-parity fuzz campaign against the reference binary.

Reuses the committed fuzz harness (tests/test_fuzz_reference.py) with many
fresh seeds — run offline to shake out parity gaps beyond the committed
seeds; any failure prints the failing seed for promotion into the suite.

Usage: python tools/fuzz_campaign.py [n_seeds] [start_seed]
"""

import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import test_fuzz_reference as F  # noqa: E402


def build_binary(tmp):
    out = os.path.join(tmp, "ssw_test")
    subprocess.run(
        ["gcc", "-O2", "-o", out,
         os.path.join(F.REF_SRC, "main.c"), os.path.join(F.REF_SRC, "ssw.c"),
         "-lm", "-lz"], check=True, capture_output=True)
    return out


PROTEIN_OPTSETS = [
    ["-p", "-c"],
    ["-p", "-c", "-s", "-h"],
    ["-p", "-o", "10", "-e", "1", "-c"],
    ["-p", "-a", "B62.TXT", "-c"],                 # matrix file
    ["-p", "-a", "B62.TXT", "-o", "11", "-e", "1", "-c"],
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(prefix="fuzzc_")
    binary = build_binary(tmp)
    shutil.copy(os.path.join(REPO, "tests", "data", "blosum62.txt"),
                os.path.join(tmp, "B62.TXT"))
    os.chdir(tmp)  # matrix-file optsets need leak-safe relative names
    bad = 0
    for seed in range(start, start + n):
        rng = random.Random(seed)
        for k, opts in enumerate(F.OPTSETS):
            t, q = F._random_workload(rng, tmp, f"{seed}_{k}")
            args = opts + [t, q]
            try:
                ours, ours_err = F._run_ours(args)
                ref, ref_err = F._run_ref(binary, args)
                assert ours == ref, "stdout"
                assert ours_err == ref_err, "stderr"
            except AssertionError as e:
                bad += 1
                print(f"MISMATCH seed={seed} optset={k}: {e}", flush=True)
        # protein + matrix-file optsets (uppercase relative file names:
        # the reference argv scanner reads flag chars out of -a values)
        for k, opts in enumerate(PROTEIN_OPTSETS):
            F._protein_workload(rng, tmp, f"{seed}_{k}",
                                f"T{seed}_{k}.FA", f"Q{seed}_{k}.FQ")
            args = opts + [f"T{seed}_{k}.FA", f"Q{seed}_{k}.FQ"]
            try:
                ours, ours_err = F._run_ours(args)
                ref, ref_err = F._run_ref(binary, args)
                assert ours == ref, "stdout"
                assert ours_err == ref_err, "stderr"
            except AssertionError as e:
                bad += 1
                print(f"MISMATCH seed={seed} protein optset={k}: {e}",
                      flush=True)
        if (seed - start + 1) % 5 == 0:
            print(f"seed {seed}: ok so far ({bad} mismatches)", flush=True)
    print(f"DONE: {n} seeds x {len(F.OPTSETS) + len(PROTEIN_OPTSETS)} "
          f"optsets, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
