from starvector_tpu.metrics.metrics import SVGMetrics

__all__ = ["SVGMetrics"]
