"""Config, logging, roofline utilities."""
