"""Device mesh construction, sharding rules, expert parallelism."""
