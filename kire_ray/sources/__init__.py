from kire_ray.sources.synth import SynthConfig, generate_corpus, write_corpus, corpus_for_sf_dir

__all__ = ["SynthConfig", "generate_corpus", "write_corpus", "corpus_for_sf_dir"]
