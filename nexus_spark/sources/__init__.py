"""Lake storage layer: partitioned writers, pruned readers, deletes."""
