"""Multi-device sharding of the surfel map and distributed solves."""
