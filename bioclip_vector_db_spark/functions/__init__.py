from .vector import cosine_distance, dot_product, l2_normalize, l2_norm

__all__ = ["cosine_distance", "dot_product", "l2_normalize", "l2_norm"]
