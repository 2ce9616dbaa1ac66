"""Viewer bridge (SIBR remote-viewer protocol)."""

from gaussian_transformer_tpu.viewer import network_gui

__all__ = ["network_gui"]
