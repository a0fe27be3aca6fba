"""Operator inventory (SURVEY.md §2.2) plus training-data-pipeline extensions."""

from .categorical import (
    CountFrequencyEncoder,
    OutOfFoldMeanEncoder,
    MeanEncoder,
    OneHotEncoder,
    OrdinalEncoder,
    RareLabelEncoder,
    WoEEncoder,
)
from .datetime_features import DatetimeFeatures, DatetimeSubtraction
from .discretization import (
    DecisionTreeDiscretiser,
    ArbitraryDiscretizer,
    EqualFrequencyDiscretizer,
    EqualWidthDiscretizer,
    GeometricWidthDiscretizer,
)
from .feature_creation import CyclicalFeatures, JsonFeatures, MathFeatures, RelativeFeatures
from .feature_selection import (
    MRMR,
    DropConstantFeatures,
    DropCorrelatedFeatures,
    DropDuplicateFeatures,
    DropFeatures,
    DropHighPSIFeatures,
    SelectByInformationValue,
    SelectBySingleFeaturePerformance,
    SelectByTargetMeanPerformance,
    SmartCorrelatedSelection,
)
from .imputation import (
    AddMissingIndicator,
    ArbitraryNumberImputer,
    CategoricalImputer,
    DropMissingData,
    EndTailImputer,
    MeanMedianImputer,
)
from .numerical import (
    ArcsinTransformer,
    BoxCoxTransformer,
    LogCpTransformer,
    LogTransformer,
    PowerTransformer,
    ReciprocalTransformer,
    YeoJohnsonTransformer,
)
from .outliers import ArbitraryOutlierCapper, OutlierTrimmer, Winsorizer
from .arpa import ArpaLogProbScorer, parse_arpa
from .bpe import BpeVocabBuilder
from .unigram import UnigramVocabBuilder
from .wordpiece import WordPieceTokenizer
from .web import (
    DomainBlocklistFilter, DomainCapSampler, DomainExtractor,
    HtmlTextExtractor, MainContentExtractor, MarkdownTextExtractor,
    MetaRobotsFilter,
    XRobotsTagFilter,
    RobotsTxtFilter,
    UrlCanonicalizer,
    UrlDeduplicator,
)
from .imagetext import (
    ImageTextPairExtractor,
    ImageTextPairScorer,
    join_image_text_pairs,
)
from .text import (
    ContaminationChecker,
    EncodingFixer,
    BigramLogProbScorer,
    UnigramLogProbScorer,
    DocumentFingerprint,
    GopherQualityFilter,
    QualityScorer,
    LanguageIdentifier,
    NgramLanguageIdentifier,
    PerplexityBucketer,
    PIIRedactor,
    RepetitionFeatures,
    C4Filter,
    TextCleaner,
    TextFeatures,
    BadWordsFilter,
    TfIdfScorer,
    TokenCount,
    UnicodeNormalizer,
    VocabBuilder,
)
from .dedup import (
    EmbeddingDeduplicator,
    ExactSubstringDeduplicator,
    LineDeduplicator,
    WithinDocDeduplicator,
    ExactDeduplicator,
    MinHashDeduplicator,
    NGramJaccardDeduplicator,
    SimHashDeduplicator,
    audit_index,
    compact_index,
    index_versions,
)
from .similarity import (
    BucketedCosineTopK,
    CosineTopK,
    IVFCosineTopK,
    KMeansClusterer,
    SemanticDeduplicator,
    recall_at_k,
)
from .audiocodec import (
    AudioQualityFilter,
    audio_quality,
    audio_quality_decoder,
    audio_quality_schema,
    audio_schema,
    constant_wav,
    decode_wav,
    decode_wav_samples,
    encode_wav,
    wav_decoder,
)
from .videocodec import (
    VideoQualityFilter,
    mp4_decoder,
    mp4_samples,
    probe_mp4,
    synth_mp4,
    video_schema,
)
from .pdfcodec import (
    extract_pdf_text,
    make_pdf,
    pdf_decoder,
    pdf_schema,
    pdf_text_decoder,
    pdf_text_schema,
    probe_pdf,
)
from .imagecodec import (
    ImageQualityFilter,
    decode_image,
    encode_png,
    image_decoder,
    image_schema,
    pillow_decoder,
    solid_png,
)
from .multimodal import BinaryFeatureExtractor, FrameSampler
from .imagehash import (
    ImageDeduplicator,
    ImageHasher,
    dhash_bits,
    pattern_png,
    phash_bits,
)
from .audiohash import (
    AudioDeduplicator,
    AudioHasher,
    audio_fingerprint_bits,
    pattern_wav,
)
from .crossmodal import CrossModalDeduplicator
from .code import (
    CodeLanguageIdentifier,
    LicenseDetector,
)
from .diff import content_fingerprint, corpus_diff, corpus_overlap
from .expectations import ExpectationValidator, ValidationFailedError
from .videohash import (
    VideoDeduplicator,
    VideoHasher,
    pattern_mp4,
    video_fingerprint_bits,
)
from .embeddings import (
    EmbeddingQuantizer,
    HashedTfIdfVectorizer,
    ProductQuantizer,
    L2Normalizer,
    PCAProjection,
    RandomProjection,
)
from .timeseries import ExpandingWindowFeatures, LagFeatures, WindowFeatures
from .scaling import MinMaxScaler, RobustScaler, StandardScaler
from .sampling import (
    CorpusShuffler,
    DSIRWeighter,
    DocumentChunker,
    HashSampler,
    HashSplitter,
    SequencePacker,
    SourceMixer,
    StratifiedSampler,
    WeightedSampler,
)
from .joins import AsOfJoiner, GroupedTopK, IntervalJoiner
from .profiling import (
    ColumnProfiler,
    FrequentItems,
    corpus_report,
    dedup_report,
    tokenizer_report,
)

__all__ = [
    "MeanMedianImputer", "ArbitraryNumberImputer", "EndTailImputer",
    "CategoricalImputer", "AddMissingIndicator", "DropMissingData",
    "OneHotEncoder", "CountFrequencyEncoder", "OrdinalEncoder",
    "MeanEncoder", "WoEEncoder", "RareLabelEncoder",
    "OutOfFoldMeanEncoder",
    "ArbitraryDiscretizer", "EqualFrequencyDiscretizer",
    "EqualWidthDiscretizer", "GeometricWidthDiscretizer",
    "DecisionTreeDiscretiser",
    "ArbitraryOutlierCapper", "Winsorizer", "OutlierTrimmer",
    "LogTransformer", "LogCpTransformer", "ReciprocalTransformer",
    "PowerTransformer", "BoxCoxTransformer", "YeoJohnsonTransformer",
    "ArcsinTransformer",
    "MinMaxScaler", "StandardScaler", "RobustScaler",
    "LagFeatures", "WindowFeatures", "ExpandingWindowFeatures",
    "MathFeatures", "RelativeFeatures", "CyclicalFeatures", "JsonFeatures",
    "DatetimeFeatures", "DatetimeSubtraction",
    "DropFeatures", "DropConstantFeatures", "DropDuplicateFeatures",
    "DropCorrelatedFeatures", "SmartCorrelatedSelection",
    "DropHighPSIFeatures", "SelectByInformationValue",
    "SelectBySingleFeaturePerformance", "SelectByTargetMeanPerformance",
    "MRMR",
    # LLM-data-pipeline extensions (beyond the reference inventory)
    "TextFeatures", "TokenCount", "LanguageIdentifier",
    "NgramLanguageIdentifier", "DocumentFingerprint",
    "PerplexityBucketer", "UnicodeNormalizer",
    "TextCleaner", "C4Filter", "EncodingFixer", "RepetitionFeatures",
    "GopherQualityFilter", "PIIRedactor",
    "BadWordsFilter",
    "TfIdfScorer", "ContaminationChecker", "UnigramLogProbScorer",
    "BigramLogProbScorer", "ArpaLogProbScorer", "parse_arpa",
    "WordPieceTokenizer",
    "QualityScorer",
    "VocabBuilder", "BpeVocabBuilder", "UnigramVocabBuilder",
    "ExactDeduplicator", "MinHashDeduplicator", "SimHashDeduplicator",
    "NGramJaccardDeduplicator", "EmbeddingDeduplicator", "LineDeduplicator",
    "WithinDocDeduplicator",
    "ExactSubstringDeduplicator",
    "audit_index", "compact_index", "index_versions",
    "CosineTopK", "BucketedCosineTopK", "IVFCosineTopK", "KMeansClusterer",
    "SemanticDeduplicator", "recall_at_k",
    "DomainExtractor", "DomainBlocklistFilter", "DomainCapSampler",
    "HtmlTextExtractor", "MainContentExtractor", "MarkdownTextExtractor",
    "MetaRobotsFilter", "RobotsTxtFilter", "XRobotsTagFilter",
    "ImageTextPairExtractor", "ImageTextPairScorer",
    "join_image_text_pairs",
    "UrlCanonicalizer",
    "UrlDeduplicator",
    "EmbeddingQuantizer", "HashedTfIdfVectorizer", "L2Normalizer",
    "PCAProjection", "ProductQuantizer", "RandomProjection",
    "BinaryFeatureExtractor", "FrameSampler",
    "AudioDeduplicator", "AudioHasher", "audio_fingerprint_bits",
    "pattern_wav",
    "CodeLanguageIdentifier", "CrossModalDeduplicator", "LicenseDetector",
    "content_fingerprint", "corpus_diff", "corpus_overlap",
    "ExpectationValidator", "ValidationFailedError",
    "VideoDeduplicator", "VideoHasher", "pattern_mp4",
    "video_fingerprint_bits",
    "mp4_samples",
    "ImageDeduplicator", "ImageHasher", "dhash_bits", "pattern_png",
    "phash_bits",
    "decode_image", "encode_png", "image_decoder", "image_schema",
    "pillow_decoder", "solid_png",
    "AudioQualityFilter", "ImageQualityFilter", "VideoQualityFilter",
    "audio_quality", "audio_quality_decoder",
    "audio_quality_schema",
    "audio_schema", "constant_wav", "decode_wav", "decode_wav_samples",
    "encode_wav", "wav_decoder",
    "mp4_decoder", "probe_mp4", "synth_mp4", "video_schema",
    "make_pdf", "pdf_decoder", "pdf_schema", "probe_pdf",
    "extract_pdf_text", "pdf_text_decoder", "pdf_text_schema",
    "CorpusShuffler", "DocumentChunker", "HashSampler", "HashSplitter",
    "SequencePacker",
    "SourceMixer", "StratifiedSampler", "WeightedSampler",
    "DSIRWeighter",
    "AsOfJoiner", "GroupedTopK", "IntervalJoiner",
    "ColumnProfiler", "FrequentItems", "corpus_report",
    "dedup_report", "tokenizer_report",
]
