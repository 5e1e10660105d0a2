from ishapediting_tpu.utils.logger import KVLogger, configure, get_logger, profile_kv  # noqa: F401
