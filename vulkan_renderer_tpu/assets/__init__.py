"""Asset layer: binary scene/texture/table formats, byte-compatible with the
reference renderer's formats (.vks, .vkt, fit*.dat, noise .blob, .save)."""
