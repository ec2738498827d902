/* Hand-written config.h for building the reference dav1d (C-only, no asm)
 * as a TEST ORACLE binary. This file configures the reference build; it is
 * not part of the TPU framework. */
#ifndef ORACLE_CONFIG_H
#define ORACLE_CONFIG_H

#define ARCH_AARCH64 0
#define ARCH_ARM 0
#define ARCH_PPC64LE 0
#define ARCH_RV64 0
#define ARCH_RISCV 0
#define ARCH_LOONGARCH 0
#define ARCH_LOONGARCH64 0
#define ARCH_X86 1
#define ARCH_X86_32 0
#define ARCH_X86_64 1

#define CONFIG_16BPC 1
#define CONFIG_8BPC 1
#define CONFIG_LOG 1
#define ENDIANNESS_BIG 0
#define HAVE_ASM 0
#define TRIM_DSP_FUNCTIONS 0

#define HAVE_CLOCK_GETTIME 1
#define HAVE_POSIX_MEMALIGN 1
#define HAVE_UNISTD_H 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_PTHREAD_GETAFFINITY_NP 1
#define HAVE_PTHREAD_SETAFFINITY_NP 1
#define HAVE_GETAUXVAL 1

#define _GNU_SOURCE 1

#endif
