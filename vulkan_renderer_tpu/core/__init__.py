"""Core runtime: settings, device wrapper, frame timer."""
