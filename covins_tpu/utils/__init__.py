from covins_tpu.utils import geometry  # noqa: F401
