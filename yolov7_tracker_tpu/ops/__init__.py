"""Device-side math primitives: boxes, IoU, Kalman, assignment, NMS."""
