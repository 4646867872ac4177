"""Staged index-build pipeline with lineage manifests + resume."""
