from .export import ExportedModel, export_inference, load_exported

__all__ = ["ExportedModel", "export_inference", "load_exported"]
