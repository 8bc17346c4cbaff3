from .elastic import ElasticConfig, elastic_augment, resample, sample_warp

__all__ = ["ElasticConfig", "elastic_augment", "resample", "sample_warp"]
