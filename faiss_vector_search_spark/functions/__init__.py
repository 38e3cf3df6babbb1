"""Pure Column-level building blocks. No actions, no UDFs in hot paths."""
