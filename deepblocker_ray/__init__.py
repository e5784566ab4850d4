"""deepblocker_ray — a from-scratch, Ray-Data-native record-linkage engine
(blocking + pairwise scoring + transitive clustering) with the capabilities of
qcri/DeepBlocker, re-expressed as streaming Dataset pipelines.

Reference: /root/reference (read-only). This is NOT a port — see SURVEY.md.
"""

from .config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
