"""Multimodal column kernels: binary rasters/images as opaque
``BinaryType`` columns with typed metadata, processed by Arrow-batched
pandas UDFs (SURVEY.md §2.10 U1-U7)."""
