"""Batched image→SVG via the continuous-batching engine (the reference's
vLLM quickstart equivalent, scripts/quickstart-vllm.py):

    python scripts/quickstart-serve.py <checkpoint|--random-tiny> img1.png [img2.png ...]
"""

import sys

from starvector_tpu.api import StarVectorForCausalLM
from starvector_tpu.serve.engine import Request, ServeEngine


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    ckpt, paths = sys.argv[1], sys.argv[2:]
    from PIL import Image
    import jax.numpy as jnp
    import numpy as np

    if ckpt == "--random-tiny":
        from starvector_tpu.models import starvector as sv

        model = StarVectorForCausalLM.from_config(sv.tiny_config())
        max_tokens = 24
    else:
        model = StarVectorForCausalLM.from_pretrained(ckpt)
        max_tokens = 4000

    from starvector_tpu.models import starvector as sv_mod

    engine = ServeEngine(
        model.params["svg_transformer"], model.cfg.llm, model.cfg.decoder,
        max_batch=min(8, len(paths)), max_len=8192, policy=model.policy,
    )
    engine.start()
    tok = model.tokenizer
    reqs = []
    for p in paths:
        images = model.process_images([Image.open(p)])
        cond = sv_mod.encode_image(
            model.params, model.cfg, jnp.asarray(images), policy=model.policy
        )
        ids = jnp.asarray(tok([tok.prompt], add_special_tokens=False)["input_ids"])
        pe = model.cfg.decoder_module.embed_tokens(
            model.params["svg_transformer"], ids
        )
        prefix = jnp.concatenate([cond, model.policy.cast(pe)], axis=1)
        reqs.append(engine.submit(Request(
            prefix_embeds=prefix, max_new_tokens=max_tokens, do_sample=False,
            stop_sequences=(tok.stop_sequence_ids("</svg>"),),
        )))
    for p, req in zip(paths, reqs):
        tokens = engine.generate_sync(req)
        print(f"=== {p} ===")
        print(tok.prompt + tok.decode(np.asarray(tokens)))
    engine.stop()


if __name__ == "__main__":
    main()
