"""lancet_tpu — TPU-native somatic micro-assembly variant caller.

A brand-new implementation with the capabilities of nygenome/lancet
(C++ reference studied at /root/reference; no code copied). The compute
path is JAX/XLA/Pallas; the host oracle engine in `lancet_tpu.engine`
defines exact reference semantics.
"""

__version__ = "0.1.0"
