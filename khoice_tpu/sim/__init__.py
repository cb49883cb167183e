from .reads import (
    sim_illumina,
    sim_ont,
    grab_reads,
    subset_reads_kmers,
)

__all__ = ["sim_illumina", "sim_ont", "grab_reads", "subset_reads_kmers"]
