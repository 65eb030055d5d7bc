from ganslate_tpu.ops.instance_norm import instance_norm  # noqa: F401
