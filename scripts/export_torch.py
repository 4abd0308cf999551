#!/usr/bin/env python
"""Export a uc2-tpu checkpoint to a reference-format PyTorch state dict.

  python scripts/export_torch.py model_step_200000.msgpack out.pt

Interop path back to the reference implementation (and to any torch
tooling); uses the reverse converter in uc2_tpu/models/convert.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(src: str, dst: str):
    import torch
    from flax import serialization
    from uc2_tpu.models.convert import params_to_torch_state_dict
    with open(src, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    sd = params_to_torch_state_dict(params)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, dst)
    print(f"wrote {len(sd)} tensors to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
