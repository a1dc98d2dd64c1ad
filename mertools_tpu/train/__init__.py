from .loop import CVResult, create_state, make_optimizer, run_cv  # noqa: F401
