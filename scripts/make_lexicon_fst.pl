#!/usr/bin/env perl
# Emit a lexicon transducer L in FST text format (fresh implementation of
# the Kaldi utils/make_lexicon_fst.pl contract):
#   make_lexicon_fst.pl [--pron-probs] lexicon.txt \
#       [silprob silphone [sil_disambig_sym]] > L.fst.txt
#
# Structure: a loop state; each pronunciation is a phone path from the
# loop back to the loop, with the word on the FIRST phone arc's output.
# With silprob > 0, an optional silence phone may precede the first word
# and follow every word, weighted -log(silprob) / -log(1-silprob).

use strict;
use warnings;

my $pron_probs = 0;
if (@ARGV and $ARGV[0] eq "--pron-probs") { $pron_probs = 1; shift; }
@ARGV >= 1 && @ARGV <= 4 or
    die "usage: make_lexicon_fst.pl [--pron-probs] lexicon.txt " .
        "[silprob silphone [sil_disambig]]\n";
my ($lexicon, $silprob, $silphone, $sildisambig) = @ARGV;
$silprob = 0 unless defined $silprob;

open(my $fh, "<", $lexicon) or die "cannot open $lexicon\n";

my ($startstate, $loop, $silstate) = (0, 0, -1);
my $next_state = 1;
my ($silcost, $nosilcost) = (0, 0);

if ($silprob > 0) {
    die "make_lexicon_fst.pl: silphone required with silprob\n"
        unless defined $silphone;
    $silcost = -log($silprob);
    $nosilcost = -log(1.0 - $silprob);
    ($startstate, $loop, $silstate) = (0, 1, 2);
    $next_state = 3;
    print "$startstate\t$loop\t<eps>\t<eps>\t$nosilcost\n";
    print "$startstate\t$silstate\t<eps>\t<eps>\t$silcost\n";
    if (defined $sildisambig) {
        my $mid = $next_state++;
        print "$silstate\t$mid\t$silphone\t<eps>\n";
        print "$mid\t$loop\t$sildisambig\t<eps>\n";
    } else {
        print "$silstate\t$loop\t$silphone\t<eps>\n";
    }
}

while (<$fh>) {
    my @a = split;
    next unless @a;
    my $word = shift @a;
    my $prob = $pron_probs ? shift(@a) : 1.0;
    my $pron_cost = ($prob > 0) ? -log($prob) : 1e9;
    next unless @a;
    my $cur = $loop;
    for (my $i = 0; $i <= $#a; $i++) {
        my $olabel = ($i == 0) ? $word : "<eps>";
        my $cost = ($i == 0) ? $pron_cost : 0;
        if ($i < $#a) {
            print "$cur\t$next_state\t$a[$i]\t$olabel\t$cost\n";
            $cur = $next_state++;
        } elsif ($silprob > 0) {
            my $c1 = $cost + $nosilcost;
            my $c2 = $cost + $silcost;
            print "$cur\t$loop\t$a[$i]\t$olabel\t$c1\n";
            print "$cur\t$silstate\t$a[$i]\t$olabel\t$c2\n";
        } else {
            print "$cur\t$loop\t$a[$i]\t$olabel\t$cost\n";
        }
    }
}
close $fh;
print "$loop\t0\n";
