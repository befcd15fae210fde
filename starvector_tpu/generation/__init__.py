from starvector_tpu.generation.engine import GenerationConfig, generate, generate_im2svg, generate_text2svg

__all__ = ["GenerationConfig", "generate", "generate_im2svg", "generate_text2svg"]
