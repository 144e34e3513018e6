"""Web-scale crawl engine: frontier tables, URL-seen set, politeness
scheduler, snapshot checkpoints (north_rule core)."""
