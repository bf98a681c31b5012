"""Job plans: distributed extraction pipeline + lineage/checkpointing."""
