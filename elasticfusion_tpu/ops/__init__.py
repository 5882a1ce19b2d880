"""Device-side ops: preprocessing, odometry reductions, splatting, fusion."""
