"""Hand-written Pallas TPU kernels for the codec's hot ops."""
