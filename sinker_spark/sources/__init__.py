"""Source adapters: how data enters the engine."""
