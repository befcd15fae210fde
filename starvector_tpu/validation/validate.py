"""Validation CLI (reference: starvector/validation/validate.py:8-56).

    python -m starvector_tpu.validation.validate config=configs/generation/im2svg.yaml \
        model.generation_engine=jax dataset.num_samples=32
"""

from __future__ import annotations

from starvector_tpu.config import get_config

ENGINES = {
    "jax": "StarVectorJAXValidator",
    # reference engine names map to the TPU backend
    "hf": "StarVectorJAXValidator",
    "vllm": "StarVectorServeValidator",
    "vllm-api": "StarVectorServeValidator",
}


def get_validator(config):
    # importing registers the validators
    from starvector_tpu.validation import jax_validator  # noqa: F401

    try:
        from starvector_tpu.validation import serve_validator  # noqa: F401
    except ImportError:
        pass
    from starvector_tpu.validation.svg_validator_base import validator_registry

    engine = config.get_path("model.generation_engine", "jax")
    name = ENGINES.get(engine, engine)
    if name not in validator_registry:
        raise ValueError(
            f"engine {engine!r} → {name!r} not registered; "
            f"available: {list(validator_registry)}"
        )
    return validator_registry[name](config)


def main():
    config = get_config()
    validator = get_validator(config)
    avg, _ = validator.validate()
    print(avg)


if __name__ == "__main__":
    main()
