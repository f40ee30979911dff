from sglang_tpu.gateway import main

main()
