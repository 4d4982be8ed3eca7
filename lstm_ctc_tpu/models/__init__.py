from .registry import get_model, init_model, apply_model
