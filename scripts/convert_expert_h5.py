"""Convert reference-format expert trajectory .h5 files to the framework's
.npz layout — the rebuild of gail_experts/convert_to_pytorch.py (h5 -> pt),
targeting npz instead of pickled torch tensors.

Usage: python scripts/convert_expert_h5.py trajs_env.h5 [out.npz]

Note: ``agents.gail.ExpertDataset`` also reads the raw .h5 directly, so
conversion is optional — this exists for parity with the reference tooling
and for shipping smaller subsampled files.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from gymothelloenv_tpu.agents.gail import _load_trajectories


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    src = argv[0]
    dst = argv[1] if len(argv) > 1 else os.path.splitext(src)[0] + ".npz"
    data = _load_trajectories(src)
    np.savez(dst, states=np.asarray(data["states"], np.float32),
             actions=np.asarray(data["actions"], np.float32),
             lengths=np.asarray(data["lengths"], np.int64))
    print(f"wrote {dst}: states{data['states'].shape} "
          f"actions{data['actions'].shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
