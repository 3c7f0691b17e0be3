"""Motion and measurement models as pure batched functions."""
