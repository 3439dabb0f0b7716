"""Offline tools: scene export, texture conversion, table generation
(reference: tools/)."""
