"""Data layer: LINEMOD databases, augmentation, vertex targets, pipelines."""
