from dsl_tpu.config.config import Config, ConfigDict

__all__ = ["Config", "ConfigDict"]
