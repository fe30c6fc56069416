# Data layer: annotations, tokenizer, dataset, host loader + device pipeline.
