from ishapediting_tpu.core.schedule import Schedule, make_schedule  # noqa: F401
