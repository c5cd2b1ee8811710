from youku_mplug_tpu.serving.engine import ServingEngine  # noqa: F401
