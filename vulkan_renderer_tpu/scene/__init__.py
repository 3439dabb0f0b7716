"""Scene-model layer: cameras, polygonal lights, meshes."""
