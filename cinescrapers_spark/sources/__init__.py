"""Sources: synthetic fetch corpus + per-site extractor registry."""
