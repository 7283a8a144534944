from mridc_tpu.cli import main

main()
