from redgnn_tpu.graph.kg import DeviceGraph, StaticKG, build_csr
from redgnn_tpu.graph.calibrate import calibrate_caps, FrontierCaps

__all__ = ["DeviceGraph", "StaticKG", "build_csr", "calibrate_caps", "FrontierCaps"]
