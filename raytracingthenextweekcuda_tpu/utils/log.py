"""Leveled logging + device info.

The reference logs via bare printf (GPU props dump Utils.h:135-164, scene
stats Loader.cpp:99-100, GL debug callback OpenGLFrontend.cpp:45-89). Here:
one stdlib logger namespace plus a device-report helper.
"""

from __future__ import annotations

import logging


def get_logger(name: str = "rtnw") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def report_devices() -> str:
    """Device inventory string (Utils::queryDeviceProperties analogue)."""
    import jax

    lines = []
    for d in jax.devices():
        lines.append(
            f"{d.platform}:{d.id} {getattr(d, 'device_kind', '?')} "
            f"process={d.process_index}"
        )
    backend = jax.default_backend()
    return f"backend={backend} devices=[{'; '.join(lines)}]"
