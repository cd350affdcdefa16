"""Resumable spectral tables and grid-generation drivers."""

from .spectable import SpectralTable
from .generate import (generate_disk_table, generate_polarized_table,
                       merge_shards, shard_path)
