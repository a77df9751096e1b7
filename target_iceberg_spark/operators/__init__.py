"""Composite operators the engine adds beyond single Spark primitives."""
