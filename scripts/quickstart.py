"""Quickstart: image → SVG with a local StarVector checkpoint.

Mirror of the reference quickstart (reference: scripts/quickstart.py):

    python scripts/quickstart.py <checkpoint_dir> <image.png> [max_tokens]

Without a checkpoint, pass "--random-tiny" to smoke-test the pipeline with a
randomly initialized tiny model.
"""

import sys

from starvector_tpu.api import StarVectorForCausalLM, StarVectorPipeline


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    ckpt, image_path = sys.argv[1], sys.argv[2]
    max_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 4000

    from PIL import Image

    if ckpt == "--random-tiny":
        from starvector_tpu.models import starvector as sv

        model = StarVectorForCausalLM.from_config(sv.tiny_config())
        max_tokens = min(max_tokens, 32)
    else:
        model = StarVectorForCausalLM.from_pretrained(ckpt)

    pipe = StarVectorPipeline(model)
    result = pipe(Image.open(image_path), max_new_tokens=max_tokens,
                  use_nucleus_sampling=False)
    print(result["svg"])


if __name__ == "__main__":
    main()
