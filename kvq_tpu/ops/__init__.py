from .topk import perturbed_topk, hard_topk_indicator  # noqa: F401
