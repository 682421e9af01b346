from fastlivo_tpu.ops import so3  # noqa: F401
