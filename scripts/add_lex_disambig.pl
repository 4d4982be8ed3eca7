#!/usr/bin/env perl
# Add disambiguation symbols (#1, #2, ...) to a pronunciation lexicon so
# it becomes determinizable (fresh implementation of the Kaldi
# utils/add_lex_disambig.pl contract):
#   add_lex_disambig.pl [--pron-probs] lexiconp.txt lexiconp_disambig.txt
# Prints the highest disambiguation index used.
#
# A pronunciation needs a disambig symbol if it is a prefix of another
# pronunciation or if it occurs more than once (homophones).  Homophones
# get distinct #k; entries already unique and prefix-free get none.

use strict;
use warnings;

my $pron_probs = 0;
if (@ARGV and $ARGV[0] eq "--pron-probs") { $pron_probs = 1; shift; }
@ARGV == 2 or die "usage: add_lex_disambig.pl [--pron-probs] in out\n";
my ($in, $out) = @ARGV;

open(my $ifh, "<", $in) or die "cannot open $in\n";
my @entries;  # [word, prob, @phones]
while (<$ifh>) {
    my @a = split;
    next unless @a;
    my $word = shift @a;
    my $prob = $pron_probs ? shift(@a) : 1.0;
    push @entries, [$word, $prob, [@a]];
}
close $ifh;

# count how many times each pronunciation appears, and mark prefixes
my %count;
foreach my $e (@entries) {
    $count{join(" ", @{$e->[2]})}++;
}
my %is_prefix;
foreach my $e (@entries) {
    my @ph = @{$e->[2]};
    for my $len (1 .. $#ph) {   # proper prefixes
        $is_prefix{join(" ", @ph[0 .. $len-1])} = 1;
    }
}

my %next_index;   # pron -> next disambig index to assign
my $max_disambig = 0;
# reserve_first: following Kaldi, first disambig is #1
open(my $ofh, ">", $out) or die "cannot open $out\n";
foreach my $e (@entries) {
    my ($word, $prob, $ph) = @$e;
    my $pron = join(" ", @$ph);
    my @phones = @$ph;
    if ($count{$pron} > 1 or $is_prefix{$pron}) {
        my $idx = ($next_index{$pron} // 0) + 1;
        $next_index{$pron} = $idx;
        $max_disambig = $idx if $idx > $max_disambig;
        push @phones, "#$idx";
    }
    if ($pron_probs) {
        print $ofh "$word\t$prob\t" . join(" ", @phones) . "\n";
    } else {
        print $ofh "$word\t" . join(" ", @phones) . "\n";
    }
}
close $ofh;
print "$max_disambig\n";
