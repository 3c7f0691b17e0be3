"""Filter layer: SLAM state pytree, predict, update, merge, estimate, step."""
