"""App layer: log readers, ground-truth odometry, CLI main loop."""
