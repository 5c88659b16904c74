"""Convert torchvision InceptionV3 weights for the JAX FID/IS extractor.

Run this once on ANY machine that has torchvision + internet:

    python scripts/convert_inception_weights.py --out inception_v3.npz

then place the .npz next to your data and load with:

    from spiking_diffusion_tpu.metrics.inception import (
        load_torch_weights_npz, inception_feature_fn)
    model, variables = load_torch_weights_npz("inception_v3.npz")
    feature_fn = inception_feature_fn(model, variables)

which makes FID/IS/KID directly comparable to the reference's
torchvision-based numbers (``metric/Fid_score.py``, ``metric/IS_score.py``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="inception_v3.npz")
    args = p.parse_args()

    try:
        import torchvision
    except ImportError:
        raise SystemExit(
            "torchvision is required (run this on a machine that has it); "
            "the build environment itself has no torchvision / egress."
        )
    import numpy as np

    from spiking_diffusion_tpu.metrics.inception import (
        convert_torchvision_state_dict,
    )

    weights = torchvision.models.Inception_V3_Weights.IMAGENET1K_V1
    model = torchvision.models.inception_v3(weights=weights, aux_logits=True)
    arrays = convert_torchvision_state_dict(model.state_dict())
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays)} tensors to {args.out}")


if __name__ == "__main__":
    main()
