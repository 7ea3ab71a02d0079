"""Native (C++) runtime components, loaded via ctypes with build-on-demand.

The compute path is JAX/XLA/Pallas; these are host-side runtime
accelerators (SURVEY.md §2.9 — the reference has no native code of its own;
its host hot loops ride torch's C++ DataLoader machinery, which this module
replaces for the tokenizer).
"""

from mmvqa_tpu.native.loader import get_wordpiece_lib, native_available

__all__ = ["get_wordpiece_lib", "native_available"]
