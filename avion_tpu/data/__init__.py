from avion_tpu.data.tokenizer import SimpleTokenizer, tokenize
