"""Adaptive model state for the lane-parallel codec: dictionary, context
families, and frequency models — all fixed-shape arrays with a leading lane
axis."""
