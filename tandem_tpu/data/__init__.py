from .replica import MVSScene, MVSDataset, make_batches, collate
