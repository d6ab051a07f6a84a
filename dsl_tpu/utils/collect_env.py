"""Environment report (reference ``mmdet/utils/collect_env.py`` parity)."""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "CPU": platform.processor() or platform.machine(),
    }
    try:
        import jax

        info["JAX"] = jax.__version__
        info["jax.default_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # noqa: BLE001
        info["JAX"] = f"unavailable ({e})"
    for mod in ("flax", "optax", "numpy", "cv2"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except ImportError:
            info[mod] = "not installed"
    try:
        import dsl_tpu

        info["dsl_tpu"] = dsl_tpu.__version__
    except Exception:  # noqa: BLE001
        pass
    from dsl_tpu.native import get_lib

    info["native_ops"] = "built" if get_lib() is not None else "unavailable"
    return info


def main():
    for k, v in collect_env().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
