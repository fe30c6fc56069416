# Model stack: ResNet backbone, ConcatTransformer, Caption variants.
# (caption/build_model exported once available; keep imports lazy to avoid cycles.)
