"""Snapshot an oracle_pt accumulation checkpoint to an EXR.

The oracle renderer (tools/oracle_pt.py) only writes its EXR after the
full spp budget; multi-hour renders on this 1-core host therefore keep
an (accum, done, rng) checkpoint per batch. This tool materializes the
image at whatever spp the checkpoint has reached — every completed
sample is an unbiased estimate, so a partial-spp snapshot is a valid
(noisier) oracle; gate tolerances just have to respect its noise floor.

    python tools/ckpt_to_exr.py tests/data/oracle_big_env_48.exr.ckpt.npz \
        tests/data/oracle_big_env_48.exr
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def snapshot(ckpt_path: str, out_path: str) -> int:
    from pupiloptixlab_tpu.utils.image import save_image

    d = np.load(ckpt_path, allow_pickle=False)
    done = int(d["done"])
    size = int(d["size"])
    if done <= 0:
        raise SystemExit(f"{ckpt_path}: no completed samples")
    img = (d["accum"].astype(np.float64) / done).reshape(size, size, 3)
    # oracle_pt writes film row 0 at the top; match its EXR convention
    save_image(out_path, img[::-1].astype(np.float32))
    print(f"{out_path}: {size}x{size} @ {done} spp")
    return done


if __name__ == "__main__":
    snapshot(sys.argv[1], sys.argv[2])
