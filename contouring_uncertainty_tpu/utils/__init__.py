"""Geometry, metrics, uncertainty-map and clinical utilities."""
