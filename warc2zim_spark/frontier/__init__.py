"""URL frontier: seen-filter, robots/politeness gates, priority, BFS waves."""
