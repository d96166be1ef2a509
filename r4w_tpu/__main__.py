from r4w_tpu.cli import main

main()
