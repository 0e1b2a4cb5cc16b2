"""Plans: driver-side job design — lineage commits, resume, metrics."""
