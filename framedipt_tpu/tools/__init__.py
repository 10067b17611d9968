"""Infrastructure: config, logging, errors, typed helpers."""
