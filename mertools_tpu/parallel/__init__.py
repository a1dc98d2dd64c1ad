from .dp import make_dp_train_step  # noqa: F401
