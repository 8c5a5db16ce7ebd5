"""Runtime: the jitted step function, the simulation driver, buffered
statistics, and checkpointing."""
