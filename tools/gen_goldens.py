"""Generate golden parity fixtures from the independent numpy oracles.

Run from the repo root:  python tools/gen_goldens.py

Goldens are canonicalisation *inputs* (raw oracle output); tests canonicalise
both sides at comparison time.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracles.mc_numpy import marching_cubes_numpy  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def main():
    os.makedirs(OUT, exist_ok=True)
    bunny = np.load(os.path.join(
        os.path.dirname(__file__), "..", "examples", "data", "bunny.npy"))
    v, f = marching_cubes_numpy(bunny, 0.0)
    np.savez_compressed(os.path.join(OUT, "bunny_mc.npz"), v=v, f=f)
    print(f"bunny_mc: {v.shape[0]} verts, {f.shape[0]} faces")


if __name__ == "__main__":
    main()
