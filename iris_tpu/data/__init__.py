from iris_tpu.data.datasets import (
    RayBatcher, RealDataset, ScannetppDataset, SyntheticDataset, load_dataset,
)
