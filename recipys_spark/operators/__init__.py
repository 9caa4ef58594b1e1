"""Step operator library: lazy Spark-DataFrame transforms."""

from recipys_spark.operators.base import Accumulator, Step, StepFunction
from recipys_spark.operators.historical import StepHistorical, StepRolling
from recipys_spark.operators.impute import (
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
    StepImputeModel,
)
from recipys_spark.operators.timeseries import (
    StepLag,
    StepLead,
    StepResampling,
    StepSessionize,
)
from recipys_spark.operators.asof import StepAsofJoin, asof_join
from recipys_spark.operators.scale import (
    StepBinarize,
    StepKBinsDiscretize,
    StepMaxAbsScale,
    StepMinMaxScale,
    StepNormalize,
    StepQuantileTransform,
    StepRobustScale,
    StepScale,
)
from recipys_spark.operators.encode import (
    StepHashEncode,
    StepLabelBinarize,
    StepLabelEncode,
    StepMissingIndicator,
    StepOneHotEncode,
    StepOrdinalEncode,
    StepTargetEncode,
)
from recipys_spark.operators.mathtrans import (
    StepLog1p,
    StepPolynomialFeatures,
    StepPowerTransform,
    StepSpline,
)
from recipys_spark.operators.mlimpute import (
    StepImputeIterative,
    StepImputeKNN,
    knn_impute_join,
)
from recipys_spark.operators.sklearn_compat import StepSklearn

# LLM-data-pipeline tier (table-level transforms)
from recipys_spark.operators.corpus import (
    annotate_filter,
    clean_corpus,
    dedup_paragraphs,
    ngram_decontaminate,
)
from recipys_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_dedup,
    minhash_lsh_pairs,
    simhash_clusters,
)
from recipys_spark.operators.fingerprint import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from recipys_spark.operators.bpe import (
    StepBpeTokens,
    bpe_encode,
    bpe_token_count,
    train_bpe,
)
from recipys_spark.operators.packing import (
    chunk_documents,
    deterministic_sample,
    pack_sequences,
    split_dataset,
    weighted_domain_sample,
    write_training_shards,
)
from recipys_spark.operators.rangejoin import range_join
from recipys_spark.operators.similarity import (
    cosine_topk,
    dequantize_embeddings,
    ivf_cosine_topk,
    lsh_cosine_topk,
    quantize_embeddings,
    recommend_lsh_params,
)
from recipys_spark.operators.textstats import (
    StepGopherSignals,
    StepTextFeatures,
    gopher_signals,
    unigram_logprob_scores,
)
from recipys_spark.operators.timeseries import time_rollup
from recipys_spark.operators.transcripts import (
    StepAssembleContext,
    assemble_context,
    conversation_text,
)
from recipys_spark.operators.warc import (
    html_to_text,
    parse_warc_records,
    url_features,
)

__all__ = [
    "Accumulator",
    "Step",
    "StepAsofJoin",
    "StepAssembleContext",
    "StepBinarize",
    "StepFunction",
    "StepHashEncode",
    "StepHistorical",
    "StepImputeFastForwardFill",
    "StepImputeFastZeroFill",
    "StepImputeFill",
    "StepImputeIterative",
    "StepImputeKNN",
    "StepImputeModel",
    "knn_impute_join",
    "StepKBinsDiscretize",
    "StepLabelBinarize",
    "StepLabelEncode",
    "StepLag",
    "StepLog1p",
    "StepLead",
    "StepMaxAbsScale",
    "StepMinMaxScale",
    "StepMissingIndicator",
    "StepNormalize",
    "StepOneHotEncode",
    "StepOrdinalEncode",
    "StepPolynomialFeatures",
    "StepPowerTransform",
    "StepQuantileTransform",
    "StepResampling",
    "StepRolling",
    "StepRobustScale",
    "StepScale",
    "StepSessionize",
    "StepSklearn",
    "StepSpline",
    "StepGopherSignals",
    "StepTargetEncode",
    "StepTextFeatures",
    "annotate_filter",
    "asof_join",
    "assemble_context",
    "conversation_text",
    "clean_corpus",
    "dedup_paragraphs",
    "cosine_topk",
    "dequantize_embeddings",
    "StepBpeTokens",
    "bpe_encode",
    "bpe_token_count",
    "chunk_documents",
    "deterministic_sample",
    "exact_dedup",
    "html_to_text",
    "gopher_signals",
    "ivf_cosine_topk",
    "jaccard_pairs",
    "lsh_cosine_topk",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "ngram_decontaminate",
    "pack_sequences",
    "parse_warc_records",
    "quantize_embeddings",
    "recommend_lsh_params",
    "split_dataset",
    "train_bpe",
    "url_features",
    "weighted_domain_sample",
    "write_training_shards",
    "range_join",
    "simhash_clusters",
    "time_rollup",
    "unigram_logprob_scores",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
]
