from .export import (
    ExportedModel,
    export_beam,
    export_inference,
    export_streaming,
    export_streaming_conformer_params,
    export_streaming_params,
    load_exported,
)
from .streaming import ExportedStreamer, load_exported_streamer

__all__ = [
    "ExportedModel",
    "export_beam",
    "ExportedStreamer",
    "export_inference",
    "export_streaming",
    "export_streaming_conformer_params",
    "export_streaming_params",
    "load_exported",
    "load_exported_streamer",
]
