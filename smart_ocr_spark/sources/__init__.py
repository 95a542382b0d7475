"""Sources: synthetic corpus generation, table loading, checkpoint store."""
