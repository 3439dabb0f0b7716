"""Render layer: visibility, shading, textures, BVH, frame pipeline."""
